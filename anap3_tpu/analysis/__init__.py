"""Post-solve analysis: conserved quantities, vortex metrics, validation errors."""
