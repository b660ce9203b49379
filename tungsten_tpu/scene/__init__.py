from .load import SceneDocument, load_scene
from .flatten import FlatScene, flatten_scene
