from .matcher import match_trajectory, build_candidates  # noqa: F401
