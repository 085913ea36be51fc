"""Asset layer: loaders, tessellators, caching (reference layer L3, Src/Assets/)."""
