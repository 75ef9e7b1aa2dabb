"""Engine processing configuration (build plan M0).

Mirrors the reference's processing config surface
(config/development.json:34-69): batch sizing, file caps, quality
thresholds, X12 separators and the supported transaction-type list —
as one frozen object threaded through the pipeline instead of
scattered literals. Only the 9 healthcare types actually wired in the
reference are "supported"; the 850/810/856/997/214/940 types its
config lists are declared-but-dead there (SURVEY §2.10 note) and are
intentionally absent here.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # processing (config/development.json:35-37)
    batch_size: int = 100               # files per streaming trigger
    max_file_size_mb: int = 50          # bronze per-file cap
    quality_threshold: int = 70         # "acceptable" score floor
    valid_threshold: int = 50           # below this a row is is_valid=False
                                        # (silver_x12_parsing.py:1072-1073)

    # X12 separators (config/development.json:64-69)
    segment_terminator: str = "~"
    element_separator: str = "*"
    component_separator: str = ":"

    # the 9 wired healthcare transaction types
    supported_types: tuple[str, ...] = (
        "837", "835", "834", "270", "271", "276", "277", "278", "279",
    )

    # SFTP exchange (config/development.json:78-79,117)
    sftp_max_file_mb: int = 100
    sftp_min_age_minutes: int = 5

    @property
    def max_file_bytes(self) -> int:
        return self.max_file_size_mb * 1024 * 1024


DEFAULT_CONFIG = EngineConfig()
