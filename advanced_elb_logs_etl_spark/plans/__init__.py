from .catalog import CATALOG, oracle_sql, queries  # noqa: F401
from . import catalog_llm  # noqa: F401,E402  (registers LLM-ops queries into CATALOG)
from . import catalog_wh  # noqa: F401,E402  (registers warehouse-ops queries into CATALOG)
from . import catalog_r3  # noqa: F401,E402  (registers round-3 wave into CATALOG)
from . import catalog_r4  # noqa: F401,E402  (registers round-4 wave into CATALOG)
from . import catalog_tpch  # noqa: F401,E402  (registers the TPC-H completion wave)
from . import catalog_graph  # noqa: F401,E402  (registers the graph-analytics wave)
from . import catalog_sketch  # noqa: F401,E402  (registers the sketch/heavy-hitter wave)
from . import catalog_r4b  # noqa: F401,E402  (registers the round-4b stats/setsim wave)
