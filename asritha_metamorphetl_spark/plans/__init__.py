"""Query plans: the engine's registered queries + oracle SQL registry."""
