from ivideogpt_tpu.data.npz_dataset import (  # noqa: F401
    RoboticDataset,
    MixRoboticDataset,
    EvalDataset,
    InfiniteDataLoader,
    EvalDataLoader,
    get_base_stepsize,
    get_display_key,
)
from ivideogpt_tpu.data.dataset_mixes import (DATASET_NAMED_MIXES,  # noqa: F401
                                              resolve_eval_dataset_name)
