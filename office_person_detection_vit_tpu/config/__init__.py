"""Config subsystem (reference src/config/__init__.py re-exports)."""

from .config_manager import ConfigManager, ConfigValidationError

__all__ = ["ConfigManager", "ConfigValidationError"]
