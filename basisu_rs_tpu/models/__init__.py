"""High-level transcode pipelines (the production surface for batch work)."""

from .pipeline import BasisCorpusPipeline, FileResult, PipelineState
from .transcoder import (
    CorpusTranscoder,
    Etc1sCorpusTranscoder,
    TranscodeResult,
    UastcTranscoder,
)

__all__ = [
    "BasisCorpusPipeline",
    "CorpusTranscoder",
    "Etc1sCorpusTranscoder",
    "FileResult",
    "PipelineState",
    "TranscodeResult",
    "UastcTranscoder",
]
