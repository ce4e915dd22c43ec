#!/usr/bin/env python
"""Reference-shaped entry point: ``python main.py --config configs/<scene>.txt``
(reference main.py:460-462). The driver itself lives in
``cvnerf_tpu/cli.py`` (installed as the ``cvnerf-train`` console script)."""

from cvnerf_tpu.cli import main

if __name__ == "__main__":
    main()
