"""Traverser operators (SURVEY §2.C/§2.D): the reference's 27 REST
traversers re-expressed as DataFrame programs. Shared machinery:
bfs.py (frontier loop), paths.py (path-carrying joins)."""
