from comorag_tpu.prompts.manager import PromptManager
from comorag_tpu.prompts.linking import get_query_instruction

__all__ = ["PromptManager", "get_query_instruction"]
