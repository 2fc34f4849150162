#!/usr/bin/env python
"""bin/swtcreate twin: swtcreate.py <list.txt> [--iterations 10] [--param min,step,max ...]

Coordinate-descent parameter search for SWT maximizing the Wolf-Jolion
F-score on annotated images (reference: bin/swtcreate.c). list.txt lines:
<image-path> <truth-path>, truth files hold one "x y w h" rect per line.
Range flags: --low-thresh 50,25,150 --high-thresh ... --min-height ...
(use the SwtParams field name with dashes)."""

import argparse
import dataclasses
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


INT_FIELDS = {"size", "low_thresh", "high_thresh", "max_height",
              "min_height", "min_area", "letter_occlude_thresh",
              "letter_thresh", "intensity_thresh"}


def main():
    from ccv_tpu.core.io import read, IO_GRAY
    from ccv_tpu.detectors import swt
    from ccv_tpu.train.swt import Range, optimize_params

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("list")
    ap.add_argument("--iterations", type=int, default=10)
    for f in dataclasses.fields(swt.SwtParams):
        if f.name in ("scale_invariant", "same_word_thresh"):
            continue
        ap.add_argument(f"--{f.name.replace('_', '-')}", default=None,
                        help="min,step,max search range")
    args = ap.parse_args()
    images, truths = [], []
    for line in open(args.list):
        parts = line.split()
        if len(parts) != 2:
            continue
        images.append(read(parts[0], IO_GRAY).numpy())
        truths.append([tuple(map(int, l.split())) for l in
                       open(parts[1]).read().split("\n") if l])
    ranges = {}
    for f in dataclasses.fields(swt.SwtParams):
        v = getattr(args, f.name, None)
        if isinstance(v, str):
            lo, step, hi = (float(t) for t in v.split(","))
            ranges[f.name] = Range(lo, step, hi)
    print(f"{len(images)} images; searching {sorted(ranges)}")
    best = optimize_params(images, truths, ranges,
                           iterations=args.iterations,
                           integer_fields=tuple(INT_FIELDS))
    print("best params:")
    for f in dataclasses.fields(swt.SwtParams):
        print(f"  {f.name} = {getattr(best, f.name)}")


if __name__ == "__main__":
    main()
