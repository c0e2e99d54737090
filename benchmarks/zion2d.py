"""ZION2D benchmark CLI (reference counterpart: /root/reference/tests/zion2d)."""

from .runner import main

if __name__ == "__main__":
    main("zion2d")
