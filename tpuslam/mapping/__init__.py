"""Keyframe memory, visual-word dictionary, loop closure, pose graph data.

TPU-native re-design of the reference mapping stack
(/root/reference/src/slam/src/core/{Mapper,Node,Link,VWDictionary,
VisualWord,Graph}.cpp): graph bookkeeping on host, dictionary KNN and
loop-closure registration as batched device programs.
"""
