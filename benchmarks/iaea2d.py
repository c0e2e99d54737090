"""IAEA2D benchmark CLI (reference counterpart: /root/reference/tests/iaea2d)."""

from .runner import main

if __name__ == "__main__":
    main("iaea2d")
