"""High-level transcode pipelines (the production surface for batch work)."""

from .pipeline import BasisCorpusPipeline, FileResult, PipelineState
from .transcoder import (
    CorpusTranscoder,
    Etc1sCorpusTranscoder,
    Etc1sFileWork,
    Etc1sMultiCorpusTranscoder,
    TranscodeResult,
    UastcTranscoder,
)

__all__ = [
    "BasisCorpusPipeline",
    "CorpusTranscoder",
    "Etc1sCorpusTranscoder",
    "Etc1sFileWork",
    "Etc1sMultiCorpusTranscoder",
    "FileResult",
    "PipelineState",
    "TranscodeResult",
    "UastcTranscoder",
]
