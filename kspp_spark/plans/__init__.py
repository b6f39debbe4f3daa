from kspp_spark.plans.topology import Stream, Topology

__all__ = ["Stream", "Topology"]
