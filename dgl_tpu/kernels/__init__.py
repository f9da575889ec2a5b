from .lane_spmm import LanePlan, build_plan, lane_spmm
from .attach import LaneAttachment, attach_lane_plans, choose_plan_config

__all__ = ["LanePlan", "build_plan", "lane_spmm", "LaneAttachment", "attach_lane_plans", "choose_plan_config"]
