"""Query-suite registry: importing this package registers all query
specs into ``REGISTRY`` (driver contract: __spark_entry__.py)."""

from .base import REGISTRY, QuerySpec

from . import archiver  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import relational3  # noqa: F401,E402
from . import relational4  # noqa: F401,E402
from . import relational5  # noqa: F401,E402
from . import relational6  # noqa: F401,E402
from . import relational7  # noqa: F401,E402
from . import relational8  # noqa: F401,E402
from . import sessions  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import text2  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import embedding  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import pipeline  # noqa: F401,E402
from . import udxf  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import retrieval  # noqa: F401,E402
from . import embedding2  # noqa: F401,E402
from . import quality  # noqa: F401,E402
from . import quality2  # noqa: F401,E402
from . import streaming_twins  # noqa: F401,E402
from . import dedup2  # noqa: F401,E402
from . import graphrank  # noqa: F401,E402
from . import pipeline2  # noqa: F401,E402
from . import archiver2  # noqa: F401,E402
from . import analytics2  # noqa: F401,E402
from . import analytics3  # noqa: F401,E402
from . import analytics4  # noqa: F401,E402
from . import analytics5  # noqa: F401,E402
from . import verify2  # noqa: F401,E402
from . import analytics6  # noqa: F401,E402
from . import retrieval2  # noqa: F401,E402
from . import analytics7  # noqa: F401,E402
from . import text3  # noqa: F401,E402
from . import embedding3  # noqa: F401,E402
from . import graph2  # noqa: F401,E402
from . import pipeline3  # noqa: F401,E402
from . import analytics8  # noqa: F401,E402
from . import analytics9  # noqa: F401,E402
from . import curation2  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec"]
