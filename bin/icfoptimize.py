#!/usr/bin/env python
"""bin/icfoptimize twin: icfoptimize.py <cascade.icf> <validates-dir> <out.icf> [--accept 0.98]

Tightens the soft-cascade thresholds so the given fraction of validation
positives survives every prefix (reference: bin/icfoptimize.c +
ccv_icf_classifier_cascade_soft)."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cascade")
    ap.add_argument("validates")
    ap.add_argument("output")
    ap.add_argument("--accept", type=float, default=0.98)
    args = ap.parse_args()
    from ccv_tpu.detectors import icf
    from ccv_tpu.train import icf as train_icf

    cas = icf.load_cascade(args.cascade)
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "icfcreate", os.path.join(os.path.dirname(__file__),
                                  "icfcreate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    vals = mod._load_dir(args.validates, (cas.width, cas.height))
    train_icf.optimize_soft_cascade(cas, vals, args.accept)
    train_icf.write_cascade(cas, args.output)
    print(f"optimized thresholds at {args.accept:.2%} acceptance"
          f" -> {args.output}")


if __name__ == "__main__":
    main()
