from comorag_tpu.eval.qa_eval import exact_match_scores, extract_final_answer, f1_scores

__all__ = ["exact_match_scores", "f1_scores", "extract_final_answer"]
