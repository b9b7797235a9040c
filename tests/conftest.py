import numpy as np
import pandas as pd
import pytest

from st_mapmatching_spark.config import MatchConfig
from st_mapmatching_spark.graph.network import Network
from st_mapmatching_spark.sources.network_gen import make_grid_network
from st_mapmatching_spark.sources.pages_gen import make_pages


@pytest.fixture(scope="session")
def cfg() -> MatchConfig:
    return MatchConfig()


@pytest.fixture(scope="session")
def net(cfg) -> Network:
    edges, nodes = make_grid_network(cfg, nx=12, ny=12, seed=42)
    return Network(edges, nodes, cfg)


@pytest.fixture(scope="session")
def pages(net, cfg) -> pd.DataFrame:
    return make_pages(net, cfg, n_trajs=12, seed=42)


@pytest.fixture(scope="session")
def spark():
    from st_mapmatching_spark.session import get_spark
    s = get_spark(cores=4, app="stmm-tests")
    yield s
