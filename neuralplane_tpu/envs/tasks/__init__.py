from .heading import HeadingTask, HeadingTaskState
from .control import ControlTask, ControlTaskState
from .tracking import TrackingTask, TrackingTaskState

TASKS = {
    "heading": HeadingTask,
    "control": ControlTask,
    "tracking": TrackingTask,
}
