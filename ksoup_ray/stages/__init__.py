"""Ray Data map_batches stages (actor pools for stateful parse work)."""
