"""In-the-wild inference CLI (reference run/inference.py).

Same pipeline as opt_main with the `wild` dataset -> CustomDataset
(inference.py:118-121), `h36m_cluster{S}` inits (inference.py:68-69),
results saved to results.npy (inference.py:236), GT eval gated on --eval
(inference.py:239-241).
"""
from __future__ import annotations

import numpy as np
from absl import app, flags
from absl.flags import argparse_flags

from zedo_tpu.run.opt_main import FLAGS, build_dataset, run_pipeline


def parse_args(argv):
    parser = argparse_flags.ArgumentParser(description="in-the-wild inference")
    parser.add_argument("--ckpt_dir", type=str)
    parser.add_argument("--ckpt_name", type=str)
    parser.add_argument("--gt", action="store_true", default=False)
    parser.add_argument("--hypo", type=int, default=1)
    parser.add_argument("--eval", action="store_true", default=False,
                        help="evaluate against provided GT 3D")
    parser.add_argument("--ema", action="store_true", default=False)
    parser.add_argument("--dtype", type=str, default="auto",
                        choices=["auto", "fp32", "bf16"])
    parser.add_argument("--save", type=str, default="results.npy")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cluster_dir", type=str, default="clusters")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--strict_batch", action="store_true", default=False)
    parser.add_argument("--override", action="append", default=[],
                        help="config override, e.g. --override ZeDO.OIL_iterations=500")
    return parser.parse_args(argv[1:])


def main(args):
    config = FLAGS.config
    from zedo_tpu.utils.config import apply_overrides, enable_compilation_cache

    enable_compilation_cache()
    apply_overrides(config, getattr(args, "override", []))
    dataset = build_dataset(config, args)
    batch_results = run_pipeline(config, args, dataset)
    np.save(args.save, batch_results)
    print(f"saved results to {args.save}")
    if args.eval:
        dataset.eval_multi(batch_results, protocol2=False, print_verbose=True)
        dataset.eval_multi(batch_results, protocol2=True, print_verbose=True)


if __name__ == "__main__":
    app.run(main, flags_parser=parse_args)
