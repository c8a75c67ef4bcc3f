from ivideogpt_tpu.vp.interface import IVideoGPTPredictor  # noqa: F401
