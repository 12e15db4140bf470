"""Ray Data pipelines for the training-data operators over the provided
testdata tables (documents, embeddings, customer/nation, orders, events,
lineitem).

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table.
Broadcast-small-side joins use ``ray.put`` + per-batch dict lookups (the
ST4 pattern, SURVEY.md §2.5); wide aggregations pre-aggregate per block
before the final combine.

Since r5 this module is a FACADE over the family modules (mechanical
split, zero behavior change): dp_common (shared infra), dp_dedup,
dp_emb, dp_text, dp_multimodal, dp_rel_events, dp_retrieval. Every
name - including underscore helpers, which each module lists in its
``__all__`` for exactly this purpose - is re-exported here, so
``from .datapipe import X`` and ``datapipe.X`` keep working for the
driver contract, queries.py, the CLI, and the tests. Note that a
function resolves ITS OWN module's globals at call time: monkeypatch
the defining dp_* module, not this facade.
"""

from __future__ import annotations

from .dp_common import *  # noqa: F401,F403
from .dp_dedup import *  # noqa: F401,F403
from .dp_emb import *  # noqa: F401,F403
from .dp_text import *  # noqa: F401,F403
from .dp_multimodal import *  # noqa: F401,F403
from .dp_rel_events import *  # noqa: F401,F403
from .dp_retrieval import *  # noqa: F401,F403
