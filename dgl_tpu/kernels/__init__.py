from .lane_spmm import LanePlan, build_plan, lane_spmm

__all__ = ["LanePlan", "build_plan", "lane_spmm"]
