from tti.kernels.maskstats import instance_mask_stats, instance_mask_stats_xla

__all__ = ["instance_mask_stats", "instance_mask_stats_xla"]
