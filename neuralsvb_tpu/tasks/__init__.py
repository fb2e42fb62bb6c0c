"""Task layer (L7): training/eval/inference logic per experiment family."""
