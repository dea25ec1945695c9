"""Autotest shim: the lte-softmodem loop as a sim-style CLI
(runtime/lte_softmodem.py; pass string "LTE softmodem loop OK")."""
from ..runtime.lte_softmodem import main

if __name__ == "__main__":
    import sys
    sys.exit(main())
