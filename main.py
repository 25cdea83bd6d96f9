#!/usr/bin/env python
"""Reference-compatible entry point (README.md:55-64 documents this CLI):

    python main.py --total_epochs 10000
    python main.py --checkpoint_path <ckpt> --total_epochs 2000
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

from flowerdiff.cli import main

if __name__ == "__main__":
    main()
