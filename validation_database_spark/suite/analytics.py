from . import QuerySpec

SPECS: list[QuerySpec] = []
