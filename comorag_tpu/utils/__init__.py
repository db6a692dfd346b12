from comorag_tpu.utils.hashing import content_hash
from comorag_tpu.utils.jsonio import load_jsonl, save_jsonl
from comorag_tpu.utils.text import text_processing, normalize_answer

__all__ = ["content_hash", "load_jsonl", "save_jsonl", "text_processing", "normalize_answer"]
