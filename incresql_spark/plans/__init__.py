"""Physical-plan engineering utilities for 100 TB scale.

The reference hand-builds one physical strategy (single-threaded hash join /
hash agg, SURVEY §4); on Spark the planner chooses, and this module carries
the knobs a cluster deployment needs when the defaults lose:

- ``skew.salted_join``         — explicit key-salting for pathological skew
  beyond what AQE's skew-join splitting handles
- ``skew.broadcast_threshold`` — sizing helper for dimension broadcasts
- ``layout.bucketed``          — write/read bucketed tables for
  shuffle-free co-located joins on stable keys
- ``layout.partition_for``     — choose partition counts from data volume
"""
