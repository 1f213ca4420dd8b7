"""python -m prmers_tpu — the CLI entry point (reference: src/main.cpp)."""
import sys

from .core.app import main

if __name__ == "__main__":
    sys.exit(main())
