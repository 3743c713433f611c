"""TCGA-BRCA 4-subtype finetuning driver.

Parity surface: reference ``scripts/train_tcga.py`` — a thin driver over the
training CLI for the TCGA-BRCA molecular-subtyping task (4 classes:
LumA/LumB/Her2/Basal) with CLI overrides (:74-101).

Usage:
  python scripts/train_tcga.py --data-dir /data/tcga_brca_graphs \
      --metadata /data/tcga_brca_labels.csv --output-dir ./tcga_run
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgdm_histopath_tpu.cli.train import main as train_main

SUBTYPES = ["LumA", "LumB", "Her2", "Basal"]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True,
                   help="directory of preprocessed *_graph.npz TCGA graphs")
    p.add_argument("--metadata", required=True, help="slide_id,label csv")
    p.add_argument("--output-dir", default="./tcga_brca_run")
    p.add_argument("--config", default=str(Path(__file__).parent.parent
                                           / "configs" / "dgdm_base.yaml"))
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--pretrain-epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--devices", type=int, default=None)
    args = p.parse_args()

    cli_args = [
        "--config", args.config,
        "--data-dir", args.data_dir,
        "--dataset-type", "graph",
        "--metadata", args.metadata,
        "--output-dir", args.output_dir,
        "--num-classes", str(len(SUBTYPES)),
        "--max-epochs", str(args.max_epochs),
        "--pretrain-epochs", str(args.pretrain_epochs),
        "--batch-size", str(args.batch_size),
        "--learning-rate", str(args.learning_rate),
    ]
    if args.devices:
        cli_args += ["--devices", str(args.devices)]
    print(f"TCGA-BRCA subtyping: {SUBTYPES}")
    return train_main(cli_args)


if __name__ == "__main__":
    sys.exit(main())
