"""High-level transcode pipelines (the production surface for batch work)."""

from .pipeline import BasisCorpusPipeline, FileResult, PipelineState
from .transcoder import CorpusTranscoder, TranscodeResult, UastcTranscoder

__all__ = [
    "BasisCorpusPipeline",
    "CorpusTranscoder",
    "FileResult",
    "PipelineState",
    "TranscodeResult",
    "UastcTranscoder",
]
