"""Runtime configuration mirroring the reference's env surface
(reference app/config.py): a user switching from the reference keeps the
same knobs. Dead config (PIPELINE_PL_SENSORS, SURVEY.md §2.10) is
intentionally NOT replicated.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _bool(v: str | None, default: bool) -> bool:
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


@dataclass
class Settings:
    # cycle cadence (reference app/config.py:16) -> streaming trigger
    sleep_seconds: int = 300
    # live APIs vs synthetic (app/config.py:17)
    live_api: bool = False
    # skip the NL source entirely (app/main.py:1226)
    disable_nl: bool = False
    # keep only automatic PL stations (app/config.py:44)
    pl_only_auto: bool = True
    # Kafka wire (app/config.py:10)
    kafka_topic: str = "airquality.raw"
    kafka_bootstrap: str = ""
    # retention window (app/housekeeping.py:6)
    retention_days: int = 7
    # NL request budget per cycle (app/main.py:416)
    nl_request_budget: int = 280
    extra: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "Settings":
        e = os.environ if env is None else env
        return cls(
            sleep_seconds=int(e.get("PIPELINE_SLEEP_SECONDS", "300")),
            live_api=_bool(e.get("PIPELINE_LIVE_API"), False),
            disable_nl=_bool(e.get("PIPELINE_DISABLE_NL"), False),
            pl_only_auto=_bool(e.get("PIPELINE_PL_ONLY_AUTO"), True),
            kafka_topic=e.get("KAFKA_TOPIC", "airquality.raw"),
            kafka_bootstrap=e.get("KAFKA_BOOTSTRAP_SERVERS", ""),
            retention_days=int(e.get("PIPELINE_RETENTION_DAYS", "7")),
            nl_request_budget=int(e.get("PIPELINE_NL_BUDGET", "280")),
        )

    @property
    def trigger(self) -> dict[str, str]:
        """Structured Streaming trigger kwarg for the cycle cadence."""
        return {"processingTime": f"{self.sleep_seconds} seconds"}
