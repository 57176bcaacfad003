"""models layer: batch transcoder + multi-slice corpus pipeline."""

import numpy as np

from basisu_rs_tpu.models import CorpusTranscoder, UastcTranscoder
from basisu_rs_tpu.ops import transcode_blocks


def test_uastc_transcoder_matches_dispatch(golden):
    blocks = golden["bc7_in"][:128]
    t = UastcTranscoder("bc7")
    out, err = t.transcode(blocks)
    ref, ref_err = transcode_blocks(blocks, "bc7")
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(err, ref_err)
    assert t.profiler.stats["host/partition"].calls == 1


def test_corpus_transcoder_multislice(golden):
    # simulate a mipmapped asset: slices of decreasing size
    blocks = golden["astc_in"]
    slices = [blocks[:96], blocks[96:120], blocks[120:126], blocks[126:128]]
    c = CorpusTranscoder("astc")
    outs = c.transcode_slices(slices)
    ref, _ = transcode_blocks(blocks[:128], "astc")
    got = np.concatenate(outs, axis=0)
    np.testing.assert_array_equal(got, ref)
    assert [len(o) for o in outs] == [96, 24, 6, 2]
