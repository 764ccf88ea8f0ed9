"""Feature-extraction model families: XFeat (deep) and ORB (classic)."""
