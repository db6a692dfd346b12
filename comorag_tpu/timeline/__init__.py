from comorag_tpu.timeline.summarizer import TimelineSummarizer, adaptive_window_size

__all__ = ["TimelineSummarizer", "adaptive_window_size"]
