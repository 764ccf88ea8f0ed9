"""Host utilities: dataset IO, synthetic scenes, timing stats, config."""
