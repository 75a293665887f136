from .confusion import confusion_matrix, scores_from_confusion
from .boxmask import box_masks
from .blur_pallas import gaussian_blur_fused
