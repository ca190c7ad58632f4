#!/usr/bin/env python
"""Prune stale checkpoint snapshots from output directories.

Analogue of the reference's clean_models.py (reference
clean_models.py:1-20): for each run directory, every periodic
``model_*.msgpack`` snapshot is removed except the tagged last
checkpoint, ``model_final`` and ``model_min_loss``. The reference also
backs up log.txt before cleaning; we do the same when one exists.

Usage: python tools/clean_models.py RES/run_a RES/run_b ...
       python tools/clean_models.py --keep-last 2 'RES/res*'
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from detection_3d_tpu.utils.checkpoint import Checkpointer  # noqa: E402
from detection_3d_tpu.utils.logger import setup_logger  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+",
                    help="run output directories (globs ok)")
    ap.add_argument("--keep-last", type=int, default=0,
                    help="also spare the N newest periodic snapshots")
    args = ap.parse_args()
    logger = setup_logger("clean_models")

    dirs = []
    for p in args.paths:
        dirs += sorted(glob.glob(p)) or [p]
    removed = 0
    for d in dirs:
        if not os.path.isdir(d):
            logger.warning("skipping %s: not a directory", d)
            continue
        log = os.path.join(d, "log.txt")
        if os.path.exists(log):  # clean_models.py:8-9 log backup
            shutil.copyfile(log, os.path.join(d, "_log.txt"))
        gone = Checkpointer(d, logger).prune(keep_last=args.keep_last)
        removed += len(gone)
        logger.info("%s: clean ok (%d removed)", d, len(gone))
    logger.info("total removed: %d", removed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
