"""Relational operators — each a pure DataFrame→DataFrame transform, so
Catalyst can fuse, prune, and push down across operator boundaries."""
