from .tables import load_tables, register_views

__all__ = ["load_tables", "register_views"]
