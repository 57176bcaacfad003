#!/usr/bin/env python
"""Extract the golden block-transcode corpus from the reference tests.

The reference ships 3,040 (UASTC block -> expected output) pairs as Rust
literals (tests/block_test_cases/*.rs, 32 blocks x 19 modes x 5 targets).
They are the bit-exactness oracle for this build (SURVEY.md C22).  We port
the committed *data* to an .npz fixture; the test harness around it is ours.

Run:  python tools/extract_golden.py
Writes: tests/fixtures/golden_blocks.npz with, per target T in
        {rgba, astc, bc7, etc1, etc2}:
          T_in   : uint8  [M, 16]   input UASTC blocks
          T_out  : uint8  [M, K] or uint32 [M, 16] (rgba) expected outputs
          T_mode : uint8  [M]       UASTC mode id of each case
"""

import re
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/tests/block_test_cases")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "golden_blocks.npz"

TARGETS = {
    "rgba": ("uastc_rgba.rs", np.uint32, 16),
    "astc": ("uastc_astc.rs", np.uint8, 16),
    "bc7": ("uastc_bc7.rs", np.uint8, 16),
    "etc1": ("uastc_etc1.rs", np.uint8, 8),
    "etc2": ("uastc_etc2.rs", np.uint8, 16),
}


def parse_file(path: Path):
    """Yield (mode, in_vals, out_vals) for each test pair, tracking the
    top-level `&[ ... ]` group (= UASTC mode) each pair belongs to."""
    text = path.read_text()
    start = text.index("= [") + 3
    depth = 1  # inside the outer [ ... ]
    mode = -1
    i = start
    pair_re = re.compile(r"\(\[([^\]]*)\],\s*\[([^\]]*)\]\)", re.S)
    while i < len(text) and depth > 0:
        c = text[i]
        if c == "&":
            if text[i + 1] == "[":
                mode += 1
        if c == "(" and depth == 2:
            m = pair_re.match(text, i)
            assert m, f"unparseable pair at {i}"
            in_vals = [int(t, 0) for t in re.findall(r"0x[0-9A-Fa-f]+|\d+", m.group(1))]
            out_vals = [int(t, 0) for t in re.findall(r"0x[0-9A-Fa-f]+|\d+", m.group(2))]
            yield mode, in_vals, out_vals
            i = m.end()
            continue
        if c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
        i += 1


def main() -> None:
    arrays = {}
    for target, (fname, out_dtype, out_len) in TARGETS.items():
        modes, ins, outs = [], [], []
        for mode, in_vals, out_vals in parse_file(SRC / fname):
            assert len(in_vals) == 16 and len(out_vals) == out_len
            modes.append(mode)
            ins.append(in_vals)
            outs.append(out_vals)
        arrays[f"{target}_in"] = np.array(ins, dtype=np.uint8)
        arrays[f"{target}_out"] = np.array(outs, dtype=out_dtype)
        arrays[f"{target}_mode"] = np.array(modes, dtype=np.uint8)
        print(f"{target}: {len(modes)} cases, modes {sorted(set(modes))}")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
