#include <Misha/Image.h>
