"""High-level transcode pipelines (the production surface for batch work)."""

from .transcoder import CorpusTranscoder, TranscodeResult, UastcTranscoder

__all__ = ["CorpusTranscoder", "TranscodeResult", "UastcTranscoder"]
