"""CLI argument parsing."""

from .arguments import parse_arguments

__all__ = ["parse_arguments"]
