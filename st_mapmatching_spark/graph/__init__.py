from .network import Network  # noqa: F401
from .dijkstra import bounded_dijkstra, shortest_paths_to_targets  # noqa: F401
