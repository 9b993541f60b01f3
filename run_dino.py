#!/usr/bin/env python
"""Top-level entry point, CLI-compatible with the reference run_dino.py."""
from avmnist_tpu.cli.run_dino import main

if __name__ == "__main__":
    main()
