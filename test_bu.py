#!/usr/bin/env python
"""Bottom-up-features evaluation entry point (reference ``test_bu.py``)."""

import sys

from test import main as _main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--encoder" not in " ".join(argv):
        argv += ["--encoder", "bu"]
    if "--hidden-dim" not in " ".join(argv):
        argv += ["--hidden-dim", "1024"]
    return _main(argv)


if __name__ == "__main__":
    main()
