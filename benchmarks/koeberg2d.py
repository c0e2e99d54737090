"""KOEBERG2D benchmark CLI (reference counterpart: /root/reference/tests/koeberg2d)."""

from .runner import main

if __name__ == "__main__":
    main("koeberg2d")
