from .mlp import BaseNNClassifier, MLPNNClassifier, QGPONNClassifier
