"""Host-side SLAM orchestration: the map data model, tracking state machine,
local mapping, loop closing, atlas, and the public System facade — the
single-writer Python equivalent of the reference's four mutex-guarded threads
(SURVEY.md §2.3.5/§7 design stance)."""
