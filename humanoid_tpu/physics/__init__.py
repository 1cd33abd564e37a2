from .model import RobotModel
from .urdf import load_urdf
