from .pipeline import cdc_tick, embed_text, run_streaming_pipeline

__all__ = ["cdc_tick", "embed_text", "run_streaming_pipeline"]
