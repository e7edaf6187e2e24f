from .catalog import REGISTRY, CatalogEntry, get_queries, get_oracles, register

__all__ = ["REGISTRY", "CatalogEntry", "get_queries", "get_oracles", "register"]
