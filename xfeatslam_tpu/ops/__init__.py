"""Device-side kernel library: Lie groups, camera models, geometry, matching."""
