#!/usr/bin/env python3
"""Convert a reference Torch7 checkpoint (torch.save of
{{cnn, encoder_fw, encoder_bw, decoder, output_projector}, config,
global_step, optim_state} — /root/reference/src/model/model.lua:724) into a
native v2 checkpoint directory usable with `-load_model` or
`aocr.api.AttentionOCR.load`.

Usage:
    python tools/import_torch.py <checkpoint.t7> <model_dir> [--summary]

See aocr/torch_import.py for the weight-mapping rules and
docs/parity.md ("Torch checkpoint import") for the validation story.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("t7_path", help="reference torch.save checkpoint")
    p.add_argument("model_dir", help="output model dir (final-model written)")
    p.add_argument("--summary", action="store_true",
                   help="print per-group parameter counts after import")
    p.add_argument("--long_size", type=int, default=8, choices=(4, 8),
                   help="C long width of the writing platform (4 for "
                        "32-bit torch builds)")
    args = p.parse_args(argv)

    from aocr import torch_import

    out = torch_import.import_to_model_dir(args.t7_path, args.model_dir,
                                           long_size=args.long_size)
    print(f"Imported {args.t7_path} -> {out}")
    if args.summary:
        import numpy as np

        payload = torch_import.import_checkpoint(args.t7_path,
                                                 long_size=args.long_size)
        for group, tree in payload["params"].items():
            import jax

            n = sum(int(np.asarray(x).size) for x in jax.tree.leaves(tree))
            print(f"  {group}: {n} params")
        print(f"  global_step: {payload['global_step']}")
        print(f"  config: {payload['config']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
