#!/usr/bin/env python
"""Bottom-up-features training entry point (reference ``train_bu.py``):
``train.py`` with the region-feature path (encoder=bu, hidden=1024 presets)."""

import sys

from train import main as _main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--encoder" not in " ".join(argv):
        argv += ["--encoder", "bu"]
    if "--hidden-dim" not in " ".join(argv):
        argv += ["--hidden-dim", "1024"]  # train_bu.py presets use hidden=1024
    return _main(argv)


if __name__ == "__main__":
    main()
