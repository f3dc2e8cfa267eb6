"""Small-files compaction planning — the operational counterpart of the
chunk planner for the WRITE side.

A CDC pipeline that upserts microbatches (streaming/sink.py) or writes
per-chunk snapshot output accretes small files; at 100 TB the resulting
file-listing and task-scheduling overhead dominates scan time.  The
standard fix is periodic bin-packed rewrite (Delta OPTIMIZE / Iceberg
rewrite_data_files): group under-target files into rewrite bins of
roughly ``target_bytes``, leave already-large files alone, and rewrite
each bin as one file.

The planner here is deterministic first-fit-decreasing (name-tiebroken)
so a restarted compactor reproduces the identical plan — the same
resumability contract the snapshot chunk planner keeps via its manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CompactionBin:
    files: tuple[str, ...]
    total_bytes: int


@dataclass
class CompactionPlan:
    bins: list[CompactionBin] = field(default_factory=list)
    untouched: list[str] = field(default_factory=list)

    @property
    def files_before(self) -> int:
        return sum(len(b.files) for b in self.bins) + len(self.untouched)

    @property
    def files_after(self) -> int:
        return len(self.bins) + len(self.untouched)


def plan_compaction(
    files: dict[str, int] | list[tuple[str, int]],
    target_bytes: int,
    min_input_files: int = 2,
) -> CompactionPlan:
    """Deterministic first-fit-decreasing bin packing.

    - files >= target_bytes are never rewritten (``untouched``)
    - a bin never exceeds target_bytes (single oversized files can't
      occur here — they're untouched by the rule above)
    - bins with fewer than ``min_input_files`` inputs are dissolved back
      to untouched (rewriting one file buys nothing)
    - ties broken by file name → identical plan on every run
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    items = sorted(
        files.items() if isinstance(files, dict) else list(files),
        key=lambda kv: (-kv[1], kv[0]),
    )
    untouched = [name for name, size in items if size >= target_bytes]
    small = [(n, s) for n, s in items if s < target_bytes]
    bins: list[list[tuple[str, int]]] = []
    totals: list[int] = []
    for name, size in small:
        for i, t in enumerate(totals):
            if t + size <= target_bytes:
                bins[i].append((name, size))
                totals[i] += size
                break
        else:
            bins.append([(name, size)])
            totals.append(size)
    plan = CompactionPlan(untouched=untouched)
    for b, t in zip(bins, totals):
        if len(b) < min_input_files:
            plan.untouched.extend(n for n, _ in b)
        else:
            plan.bins.append(
                CompactionBin(files=tuple(n for n, _ in b), total_bytes=t)
            )
    plan.untouched.sort()
    return plan
