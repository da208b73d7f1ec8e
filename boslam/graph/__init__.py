from boslam.graph.data import FactorGraph, GraphMeta
from boslam.graph.build import build_graph

__all__ = ["FactorGraph", "GraphMeta", "build_graph"]
