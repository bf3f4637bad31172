"""Training CLI: ``python -m gecco_tpu.train <config.py>``.

Parity with gecco-jax/src/gecco_jax/train/__main__.py:10-60: validates the
config contract, records provenance metadata, launches training with
checkpoints/tensorboard next to the config file.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess

from gecco_tpu.config import load_config


def execute(config_path: str, distributed: bool = False):
    process_index = 0
    if distributed:
        # must run before any device use; after it the standard
        # make_mesh/shard_batch path scales across hosts (ICI within a
        # slice, DCN across) — see gecco_tpu.parallel.init_distributed
        from gecco_tpu.parallel import init_distributed

        process_index = init_distributed()
        print(f"Distributed: process {process_index}", flush=True)

    config_path = os.path.abspath(config_path)
    save_path = os.path.dirname(config_path)
    config = load_config(config_path)

    for attribute in ("make_train_loader", "make_val_loader", "make_model", "train"):
        if not hasattr(config, attribute):
            raise AssertionError(
                f"Config {config_path!r} is missing the callable {attribute!r}"
            )

    train_loader = config.make_train_loader()
    val_loader = config.make_val_loader()

    metadata = {"date": datetime.datetime.now(datetime.timezone.utc).isoformat()}
    try:
        metadata["git-hash"] = (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                stderr=subprocess.DEVNULL,
            )
            .decode()
            .strip()
        )
    except Exception:
        pass
    if process_index == 0:
        with open(os.path.join(save_path, "metadata.json"), "w") as f:
            json.dump(metadata, f)

    config.train(
        config.make_model,
        train_loader,
        val_loader,
        save_path,
    )


def main():
    parser = argparse.ArgumentParser(description="Train a gecco_tpu model")
    parser.add_argument("config", help="path to a .py config file")
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="call jax.distributed.initialize before training (multi-host); "
        "cluster parameters come from the environment (TPU pods auto-detect)",
    )
    args = parser.parse_args()
    execute(args.config, distributed=args.distributed)


if __name__ == "__main__":
    main()
