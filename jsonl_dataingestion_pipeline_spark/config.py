"""O2 — environment configuration loading.

The reference requires four storage env vars and fails fast when any is
missing (`src/pipeline.py:51-66`, vars `src/config.py:8-16`). The engine
generalizes this: a declarative spec of required/optional keys, validated
before any Spark work starts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence


class ConfigError(RuntimeError):
    """A required configuration key is missing."""


@dataclass(frozen=True)
class PipelineConfig:
    input_path: str
    output_path: str
    as_of: Optional[str] = None
    strict_headers: bool = True
    extra: Mapping[str, str] = field(default_factory=dict)


REQUIRED_ENV = ("PIPELINE_INPUT_PATH", "PIPELINE_OUTPUT_PATH")
OPTIONAL_ENV = ("PIPELINE_AS_OF", "PIPELINE_STRICT_HEADERS")


def load_config(env: Optional[Mapping[str, str]] = None) -> PipelineConfig:
    """Build a :class:`PipelineConfig` from environment variables.

    Raises :class:`ConfigError` listing every missing required key (the
    reference aborts on the first missing var; listing all is kinder).
    """
    env = dict(env if env is not None else os.environ)
    missing = [k for k in REQUIRED_ENV if not env.get(k)]
    if missing:
        raise ConfigError(f"missing required environment variables: {missing}")
    return PipelineConfig(
        input_path=env["PIPELINE_INPUT_PATH"],
        output_path=env["PIPELINE_OUTPUT_PATH"],
        as_of=env.get("PIPELINE_AS_OF"),
        strict_headers=env.get("PIPELINE_STRICT_HEADERS", "1") not in ("0", "false"),
        extra={
            k: v for k, v in env.items() if k.startswith("PIPELINE_SPARK_")
        },
    )
