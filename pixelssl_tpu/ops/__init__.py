from .confusion import confusion_matrix, scores_from_confusion
