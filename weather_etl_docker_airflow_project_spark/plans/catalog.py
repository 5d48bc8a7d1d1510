"""Import side-effect module: pulls in every plan module so the registry is
fully populated, then re-exports the driver-contract accessors."""

from __future__ import annotations

from . import relational  # noqa: F401
from . import functions_q  # noqa: F401
from . import ref_weather  # noqa: F401
from . import streaming_q  # noqa: F401
from . import llm_q  # noqa: F401
from . import io_q  # noqa: F401

from .registry import REGISTRY, all_oracles, all_queries  # noqa: F401,E402
