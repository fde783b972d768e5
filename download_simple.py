#!/usr/bin/env python
"""ASCII-only dataset downloader.

The reference ships download_simple.py as a Windows-console-safe clone of
download_dataset.py (/root/reference/download_simple.py; docs/cli_tools.md).
Our main downloader is ASCII-only already, so this is a thin alias kept for
command-line compatibility.
"""

import sys

from download_dataset import main

if __name__ == "__main__":
    sys.exit(main())
