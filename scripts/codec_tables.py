"""Generate / validate / extract ACELP quantizer table files.

The runtime codec-table mechanism (voice.acelp.load_codec_tables) makes the
speech codec ETSI-interoperable once the real EN 300 395-2 codebooks are
supplied; this tool is the zero-code-reading path for producing and checking
the .npz (docs/CODEC_TABLES.md is the format spec):

    python scripts/codec_tables.py template -o demo.npz
    python scripts/codec_tables.py from-c etsi/c-code/*.c \
        --lsf1 NAME1 --lsf2 NAME2 --lsf3 NAME3 --gain GNAME -o tables.npz
    python scripts/codec_tables.py validate tables.npz
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {  # key -> (max rows, columns)
    "lsf_cb1": (256, 3),
    "lsf_cb2": (512, 3),
    "lsf_cb3": (512, 4),
    "gain_cb": (64, 2),
}


def make_template(path: str, seed: int = 7) -> None:
    """Synthetic tables with the ETSI shapes (correctly ordered LSF
    codevectors around plausible means, log-spread gains).  Tests the
    plumbing end to end; NOT interoperable with real networks."""
    rng = np.random.default_rng(seed)
    means = np.array([0.24, 0.47, 0.81, 1.12, 1.44, 1.78, 2.09, 2.40,
                      2.68, 2.94], np.float32)
    out = dict(
        lsf_cb1=(means[:3] + rng.normal(0, 0.08, (256, 3))),
        lsf_cb2=(means[3:6] + rng.normal(0, 0.08, (512, 3))),
        lsf_cb3=(means[6:] + rng.normal(0, 0.08, (512, 4))),
        gain_cb=np.stack([rng.uniform(0, 1.2, 64),
                          np.exp(rng.uniform(2.0, 7.0, 64))], 1),
        lsf_pred=np.float32(0.0),
    )
    np.savez(path, **{k: np.asarray(v, np.float32) for k, v in out.items()})
    print(f"wrote synthetic template {path}")


_C_ARRAY = r"{name}\s*\[[^]]*\]\s*(?:\[[^]]*\]\s*)?=\s*\{{(.*?)\}}\s*;"


def parse_c_array(sources: list[str], name: str) -> np.ndarray:
    """Extract a numeric C initializer list `... name[...] = { ... };`
    (one- or two-dimensional; nested braces flattened) from any of the
    given source files.  Handles int and float literals, comments, and
    line continuations -- enough for the ETSI codec table files."""
    for src in sources:
        text = open(src, errors="replace").read()
        text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
        text = re.sub(r"//[^\n]*", " ", text)
        m = re.search(_C_ARRAY.format(name=re.escape(name)), text, re.S)
        if not m:
            continue
        body = m.group(1).replace("{", " ").replace("}", " ")
        toks = re.findall(r"[-+]?(?:\d+\.\d*(?:[eE][-+]?\d+)?"
                          r"|\.\d+(?:[eE][-+]?\d+)?"
                          r"|\d+(?:[eE][-+]?\d+)?[fF]?"
                          r"|0[xX][0-9a-fA-F]+)", body)
        if not toks:
            raise ValueError(f"{name} found in {src} but no numeric "
                             f"literals parsed")
        vals = [float(int(t, 16)) if t[:2].lower() == "0x"
                else float(t.rstrip("fF")) for t in toks]
        return np.asarray(vals, np.float64)
    raise KeyError(f"array '{name}' not found in: {', '.join(sources)}")


def from_c(args) -> None:
    out = {}
    for key, opt in (("lsf_cb1", args.lsf1), ("lsf_cb2", args.lsf2),
                     ("lsf_cb3", args.lsf3), ("gain_cb", args.gain)):
        flat = parse_c_array(args.sources, opt)
        rows_max, cols = SHAPES[key]
        if len(flat) % cols:
            raise ValueError(
                f"{key}: {len(flat)} values from '{opt}' not divisible by "
                f"{cols} columns")
        arr = flat.reshape(-1, cols)
        if key.startswith("lsf"):
            arr = arr * args.scale
            if args.cos_domain:
                arr = np.arccos(np.clip(arr, -1.0, 1.0))
        else:
            arr = arr * np.array([args.gain_pitch_scale,
                                  args.gain_code_scale])
        if len(arr) > rows_max:
            raise ValueError(f"{key}: {len(arr)} rows > max {rows_max}")
        out[key] = arr.astype(np.float32)
    out["lsf_pred"] = np.float32(args.lsf_pred)
    np.savez(args.output, **out)
    print(f"wrote {args.output}: " + ", ".join(
        f"{k}{v.shape}" for k, v in out.items() if hasattr(v, "shape")))
    validate(args.output)


def validate(path: str) -> bool:
    """Hard-check shapes/dtypes, warn on implausible values, then load into
    the native codec and run an encode/decode round trip.  Prints one JSON
    verdict line; returns ok."""
    problems, warnings = [], []
    z = np.load(path)
    arrs = {}
    for key, (rows_max, cols) in SHAPES.items():
        if key not in z.files:
            problems.append(f"missing key {key}")
            continue
        a = np.asarray(z[key], np.float32)
        if a.ndim != 2 or a.shape[1] != cols:
            problems.append(f"{key}: shape {a.shape}, want (n, {cols})")
        elif not 1 <= a.shape[0] <= rows_max:
            problems.append(f"{key}: {a.shape[0]} rows, max {rows_max}")
        elif not np.isfinite(a).all():
            problems.append(f"{key}: non-finite values")
        arrs[key] = a
    if not problems:
        # LSF plausibility on the median path: each split's median
        # codevector should be ordered and inside (0, pi) -- fixed-point or
        # cosine-domain tables that skipped conversion fail this loudly
        med = np.concatenate([np.median(arrs[k], axis=0)
                              for k in ("lsf_cb1", "lsf_cb2", "lsf_cb3")])
        if not ((med > 0) & (med < np.pi)).all():
            warnings.append(
                "median LSF vector outside (0, pi): fixed-point tables? "
                "(use from-c --scale, or --cos-domain for cosine-domain)")
        elif not (np.diff(med) > -0.05).all():
            warnings.append("median LSF vector not ordered low-to-high")
        g = arrs["gain_cb"]
        if (g < 0).any() or g[:, 0].max() > 4.0:
            warnings.append("gain_cb pitch column outside [0, 4]")
        if g[:, 1].max() < 10 * max(g[:, 1].min(), 1e-9):
            warnings.append("gain_cb code column dynamic range < 10x")
        # native round trip: indices must survive the 137-bit frame
        try:
            from tetra_tpu.voice.acelp import (AcelpDecoder, AcelpEncoder,
                                               clear_codec_tables,
                                               load_codec_tables, _load)
            load_codec_tables(path)
            try:
                assert _load().tetra_acelp_tables_loaded() == 1
                enc, dec = AcelpEncoder(), AcelpDecoder()
                t = np.arange(240 * 6) / 8000.0
                pcm = (6000 * np.sin(2 * np.pi * 150 * t)
                       * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
                       ).astype(np.int16)
                audio = []
                for f in range(6):
                    bits = enc.encode_frame(pcm[f * 240:(f + 1) * 240])
                    if bits.shape != (137,):
                        problems.append("encoder produced a non-137-bit "
                                        "frame under these tables")
                        break
                    audio.append(dec.decode_frame(bits))
                if not problems:
                    a = np.concatenate(audio).astype(float)
                    rms = float(np.sqrt(np.mean(a[480:] ** 2)))
                    if not np.isfinite(a).all() or not 50 < rms < 32767:
                        problems.append(
                            f"round-trip audio implausible (rms={rms:.0f})"
                            ": gain table units wrong?")
            finally:
                clear_codec_tables()
        except RuntimeError as e:
            warnings.append(f"native codec unavailable, static checks only "
                            f"({e})")
        except ValueError as e:
            problems.append(str(e))
    ok = not problems
    print(json.dumps(dict(ok=ok, file=path, problems=problems,
                          warnings=warnings)))
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("template", help="write synthetic tables (plumbing "
                                        "test; not network-interoperable)")
    t.add_argument("-o", "--output", default="codec_tables_demo.npz")
    v = sub.add_parser("validate", help="check an .npz + native round trip")
    v.add_argument("file")
    f = sub.add_parser("from-c", help="extract tables from ETSI C sources")
    f.add_argument("sources", nargs="+")
    f.add_argument("--lsf1", required=True, help="C array name, stage-1 LSF")
    f.add_argument("--lsf2", required=True)
    f.add_argument("--lsf3", required=True)
    f.add_argument("--gain", required=True)
    f.add_argument("-o", "--output", default="codec_tables.npz")
    f.add_argument("--scale", type=float, default=1.0,
                   help="multiply LSF values (e.g. pi/8192 for Q13 "
                        "normalized frequency)")
    f.add_argument("--cos-domain", action="store_true",
                   help="LSF arrays store cos(w): apply arccos after "
                        "--scale")
    f.add_argument("--gain-pitch-scale", type=float, default=1.0,
                   help="e.g. 1/16384 for Q14 pitch gains")
    f.add_argument("--gain-code-scale", type=float, default=1.0)
    f.add_argument("--lsf-pred", type=float, default=0.0)
    args = ap.parse_args(argv)
    if args.cmd == "template":
        make_template(args.output)
    elif args.cmd == "validate":
        return 0 if validate(args.file) else 1
    else:
        from_c(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
