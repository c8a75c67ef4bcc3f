from ivideogpt_tpu.models.tokenizer import CompressiveVQModel  # noqa: F401
from ivideogpt_tpu.models.llama import LlamaForCausalLM  # noqa: F401
from ivideogpt_tpu.models.action_model import HeadModelWithAction  # noqa: F401
from ivideogpt_tpu.models.discriminator import Discriminator  # noqa: F401
