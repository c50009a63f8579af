#!/usr/bin/env python
"""Convert the reference's hrtf.zon (MagLS ambisonic->stereo decoder IRs)
into data/hrtf_magls.npz.

The data itself is from the Sound Sphere 2 dataset (CC-BY-4.0), processed
with spaudiopy into a 4-channel (first-order ambisonic) x 128-tap MagLS
filter bank per ear (reference: src/hrtf.zon:1-3, consumed at
src/sound_system.zig:23-28). This script parses the .zon literal syntax;
run once, commit the npz.

Usage: python tools/convert_hrtf.py [path/to/hrtf.zon] [out.npz]
"""

import re
import sys
from pathlib import Path

import numpy as np


def parse_zon_hrtf(text: str):
    # strip comments
    text = re.sub(r"//[^\n]*", "", text)
    out = {}
    for key in ("irs_l", "irs_r"):
        m = re.search(rf"\.{key}\s*=\s*\.{{", text)
        if not m:
            raise ValueError(f"missing {key}")
        i = m.end() - 1
        depth = 0
        for j in range(i, len(text)):
            if text[j] == "{":
                depth += 1
            elif text[j] == "}":
                depth -= 1
                if depth == 0:
                    break
        block = text[i + 1 : j]
        rows = re.findall(r"\.\{([^{}]*)\}", block)
        irs = [
            np.asarray([float(x) for x in re.findall(r"[-+0-9.eE]+", row)], np.float32)
            for row in rows
        ]
        out[key] = np.stack(irs)
    return out["irs_l"], out["irs_r"]


def main():
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference/src/hrtf.zon")
    dst = (
        Path(sys.argv[2])
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent / "data" / "hrtf_magls.npz"
    )
    irs_l, irs_r = parse_zon_hrtf(src.read_text())
    assert irs_l.shape == (4, 128) and irs_r.shape == (4, 128), (irs_l.shape, irs_r.shape)
    np.savez_compressed(dst, irs_l=irs_l, irs_r=irs_r)
    print(f"wrote {dst}: irs_l {irs_l.shape}, irs_r {irs_r.shape}")


if __name__ == "__main__":
    main()
