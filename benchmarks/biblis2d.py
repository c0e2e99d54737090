"""BIBLIS2D benchmark CLI (reference counterpart: /root/reference/tests/biblis2d)."""

from .runner import main

if __name__ == "__main__":
    main("biblis2d")
