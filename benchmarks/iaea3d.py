"""IAEA3D benchmark CLI (reference counterpart: /root/reference/tests/iaea3d)."""

from .runner import main

if __name__ == "__main__":
    main("iaea3d")
