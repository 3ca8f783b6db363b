"""Stateful helpers: checkpoint manifests, transitive-closure cache."""
