from comorag_tpu.models.base import BaseEncoder
from comorag_tpu.models.hash_encoder import HashEncoder
from comorag_tpu.models.registry import get_encoder

__all__ = ["BaseEncoder", "HashEncoder", "get_encoder"]
