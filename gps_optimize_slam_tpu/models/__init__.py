"""Fusion models: the flagship Sim3+EKF+RTS fusion pipeline and extensions."""
