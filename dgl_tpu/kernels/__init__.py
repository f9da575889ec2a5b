from .lane_spmm import LanePlan, build_plan, lane_spmm
from .attach import LaneAttachment, attach_lane_plans

__all__ = ["LanePlan", "build_plan", "lane_spmm", "LaneAttachment", "attach_lane_plans"]
