"""Shared distributed state primitives that the Dataset API can't
express at acceptable latency — currently the raw-task block exchange
used by the iterative graph fixpoint loops (`fastie_ray.state.exchange`).
"""
