"""Multi-dataset index algebra.

Re-design of the reference's SplitRanges/Collated machinery (reference:
vltk/dataset/basedataset.py:34-217): N adapters (possibly from different
datasets and splits) concatenate into one global index space, with random
access by image id falling back across adapters.

Pure host-side bookkeeping — nothing here touches the device.
"""

from __future__ import annotations

import bisect
from typing import Any, Dict,  List,  Sequence, Tuple


class SplitRanges:
    """Global row index -> (dataset name, split, adapter, local index)
    (reference: SplitRangesVL/SplitRangesVision basedataset.py:34-134)."""

    def __init__(self, parts: Sequence[Tuple[str, str, Any]]):
        """parts: list of (dataset_name, split, adapter)."""
        self.parts = list(parts)
        self._starts: List[int] = []
        total = 0
        for _, _, adapter in self.parts:
            self._starts.append(total)
            total += len(adapter)
        self._total = total

    def __len__(self) -> int:
        return self._total

    def locate(self, idx: int) -> Tuple[str, str, Any, int]:
        if idx < 0 or idx >= self._total:
            raise IndexError(idx)
        part = bisect.bisect_right(self._starts, idx) - 1
        name, split, adapter = self.parts[part]
        return name, split, adapter, idx - self._starts[part]

    def keys(self) -> List[Tuple[str, str]]:
        return [(n, s) for n, s, _ in self.parts]


class CollatedSets:
    """Concatenated adapters with an image-id ``get`` fallback chain
    (reference: CollatedVLSets/CollatedVisionSets basedataset.py:137-217)."""

    def __init__(self, parts: Sequence[Tuple[str, str, Any]]):
        self.ranges = SplitRanges(parts)

    def __len__(self) -> int:
        return len(self.ranges)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        name, split, adapter, local = self.ranges.locate(idx)
        entry = adapter.get_idx(local)
        entry["__dataset__"] = name
        entry["__split__"] = split
        return entry

    def get(self, img_id: str) -> Dict[str, Any]:
        for name, split, adapter in self.ranges.parts:
            if adapter.has(img_id):
                entry = adapter.get(img_id)
                entry["__dataset__"] = name
                entry["__split__"] = split
                return entry
        raise KeyError(img_id)

    def has(self, img_id: str) -> bool:
        return any(a.has(img_id) for _, _, a in self.ranges.parts)

    @property
    def imgids(self) -> List[str]:
        seen: Dict[str, None] = {}
        for _, _, adapter in self.ranges.parts:
            for i in adapter.imgids:
                seen.setdefault(i)
        return list(seen)

    @property
    def adapters(self) -> List[Any]:
        return [a for _, _, a in self.ranges.parts]
