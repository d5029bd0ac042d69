"""`python -m nat_tpu` entry point."""

from .cli import entrypoint

entrypoint()
