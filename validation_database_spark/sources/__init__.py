from .registry import TABLES, load_table, register_views, default_sf_dir

__all__ = ["TABLES", "load_table", "register_views", "default_sf_dir"]
