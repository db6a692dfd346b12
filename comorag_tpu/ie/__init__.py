from comorag_tpu.ie.openie import NerResult, OpenIE, TripleResult

__all__ = ["OpenIE", "NerResult", "TripleResult"]
