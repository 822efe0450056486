from deft_tpu.control.branch_controller import Branch_Controller
from deft_tpu.control import workloads

__all__ = ["Branch_Controller", "workloads"]
