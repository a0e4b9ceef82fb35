from .storage import LocalStorage

__all__ = ["LocalStorage"]
