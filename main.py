"""Launch the web UI (the reference's entry point: `python main.py`,
reference main.py:23-40 — builds the interface and serves on localhost)."""
import sys

from reverso_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["serve"] + sys.argv[1:]))
