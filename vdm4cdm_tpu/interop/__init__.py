from .torch_convert import torch_state_dict_to_flax  # noqa: F401
