# stub package: see bar.py (display-only dependency of the reference
# dataloader, not installed here)
