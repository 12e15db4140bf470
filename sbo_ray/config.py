"""Per-source pipeline configuration.

Mirrors the reference's per-monitored-file config records
(``ConfigForAMonitoredFile``, ``main.go:1015-1068``) with the
``--default--`` merge semantics (``main.go:476-570``: a per-source entry
inherits every field it does not set from the default entry) and the
validation clamps (``main.go:376-397``: metrics reorder window 2..10 else
3, top-N 1..100 else 10, counter interval >=1 else 30).

Differences from the reference, by design (SURVEY.md §7.0):

- the log *format* is explicit per source by default; ``log_format:
  "auto"`` opts into the reference's first-line sniffing
  (last-match-wins, main.go:728-748) MINUS its dropped-detection-line
  accident (the shadowed ``parseResult :=`` at ``main.go:744``) — the
  detection line is parsed normally here;
- ``SkipIfLineMatchesRegex`` is implemented (the reference only stores
  it; ``conf/README.md`` marks it unimplemented).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields
from typing import Any

from .functions.loglines import FORMAT_AUTO, FORMATS

DEFAULT_KEY = "--default--"

VALID_TIME_WINDOW_MINUTES = (1, 5, 10, 15, 30, 60)


def clamp_metrics_window_size(v: int) -> int:
    """main.go:388-397: valid 2..10, else 3."""
    return v if 2 <= v <= 10 else 3


def clamp_top_n(v: int) -> int:
    """main.go:376-387: valid 1..100, else 10."""
    return v if 1 <= v <= 100 else 10


def clamp_interval(v: int) -> int:
    """main.go:376-380: >=1 else 30."""
    return v if v >= 1 else 30


@dataclass
class SourceConfig:
    """Config for one logical source (the reference's monitored file)."""

    log_format: str = "apache_combined"
    time_window_minutes: int = 10          # TimeWindowSizeMinutes
    metrics_window_size: int = 3           # MetricsWindowSize (reorder tolerance)
    top_n: int = 10                        # TopNSize
    counter_interval_sec: int = 30         # CounterOutputIntervalSeconds
    save_only_relevant: bool = True        # SaveLogsToDbOnlyRelevant
    mask_ips: bool = False                 # MaskIPs
    replace_existing_metrics: bool = False  # ReplaceExistingMetrics (add-merge)
    skip_line_regex: str | None = None     # SkipIfLineMatchesRegex
    handlers: tuple[str, ...] = ("METRICS",)  # handler chain (main.go:692-694)

    def __post_init__(self) -> None:
        if self.log_format not in FORMATS and self.log_format != FORMAT_AUTO:
            raise ValueError(f"unknown log format {self.log_format!r}")
        if self.time_window_minutes not in VALID_TIME_WINDOW_MINUTES:
            self.time_window_minutes = 10  # metricgenerator.go:152 default arm
        self.metrics_window_size = clamp_metrics_window_size(self.metrics_window_size)
        self.top_n = clamp_top_n(self.top_n)
        self.counter_interval_sec = clamp_interval(self.counter_interval_sec)


@dataclass
class JobConfig:
    """The whole job: default config + per-source overrides."""

    default: SourceConfig = field(default_factory=SourceConfig)
    sources: dict[str, SourceConfig] = field(default_factory=dict)

    def for_source(self, source: str) -> SourceConfig:
        return self.sources.get(source, self.default)

    @classmethod
    def from_format_map(cls, formats: dict[str, str], **defaults: Any) -> "JobConfig":
        default = SourceConfig(**defaults)
        sources = {}
        for name, fmt in formats.items():
            kw = {f.name: getattr(default, f.name) for f in fields(SourceConfig)}
            kw["log_format"] = fmt
            sources[name] = SourceConfig(**kw)
        return cls(default=default, sources=sources)

    @classmethod
    def from_json(cls, text: str) -> "JobConfig":
        """JSON map keyed by source, with ``--default--`` merge semantics
        (per-field inheritance, main.go:476-570)."""
        raw = json.loads(text)
        default_raw = raw.pop(DEFAULT_KEY, {})
        default = SourceConfig(**default_raw)
        sources = {}
        for name, override in raw.items():
            kw = {f.name: getattr(default, f.name) for f in fields(SourceConfig)}
            kw.update(override)
            if isinstance(kw.get("handlers"), list):
                kw["handlers"] = tuple(kw["handlers"])
            sources[name] = SourceConfig(**kw)
        return cls(default=default, sources=sources)

    def format_map(self) -> dict[str, str]:
        return {name: cfg.log_format for name, cfg in self.sources.items()}
