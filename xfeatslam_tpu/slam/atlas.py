"""Atlas: the multi-map container.

Role of /root/reference/src/Atlas.cc: hold the active map plus frozen
maps created after tracking loss (CreateNewMap on LOST, :58), switch back
when relocalization lands in an old map (ChangeMap :79). Map merging
(LoopClosing::MergeLocal welding two maps) operates through this container.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .map import SlamMap


class Atlas:
    def __init__(self, desc_dim: int = 64, scale_factor: float = 1.2,
                 n_levels: int = 1):
        self.desc_dim = desc_dim
        self.scale_factor = scale_factor
        self.n_levels = n_levels
        self._next_map_id = 0
        self.maps: Dict[int, SlamMap] = {}
        self.active_id: Optional[int] = None
        self.create_new_map()

    @property
    def active(self) -> SlamMap:
        return self.maps[self.active_id]

    def create_new_map(self) -> SlamMap:
        """Freeze the current map and start a fresh one
        (Tracking::CreateMapInAtlas path, /root/reference/src/Tracking.cc:2689)."""
        m = SlamMap(map_id=self._next_map_id, desc_dim=self.desc_dim,
                    scale_factor=self.scale_factor, n_levels=self.n_levels)
        self.maps[m.map_id] = m
        self.active_id = m.map_id
        self._next_map_id += 1
        return m

    def change_map(self, map_id: int):
        """Relocalized into a stored map (Atlas::ChangeMap)."""
        assert map_id in self.maps
        self.active_id = map_id

    def remove_map(self, map_id: int):
        del self.maps[map_id]

    def all_maps(self) -> List[SlamMap]:
        return list(self.maps.values())

    def total_keyframes(self):
        return sum(m.num_keyframes() for m in self.maps.values())

    def total_points(self):
        return sum(m.num_points() for m in self.maps.values())
